from . import dedup, merge, quality, similarity, topk, multimodal  # noqa: F401
