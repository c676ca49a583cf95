"""Large-scale training-data operators (dedup, similarity, text, multimodal)."""

from . import dedup, multimodal, similarity, textprep, textstats  # noqa: F401
