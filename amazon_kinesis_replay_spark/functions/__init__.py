from . import arn, jsonf  # noqa: F401
