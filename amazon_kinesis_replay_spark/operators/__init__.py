from . import replay_ops, stats, dedup, similarity, text, multimodal  # noqa: F401
