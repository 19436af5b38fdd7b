from . import (  # noqa: F401
    dedup, multimodal, replay_ops, similarity, skew, stats, text)
