"""LLM-data-pipeline function modules (dedup, text, similarity, multimodal)."""

from . import clustering  # noqa: F401
from . import corpus  # noqa: F401
from . import dedup  # noqa: F401
from . import multimodal  # noqa: F401
from . import similarity  # noqa: F401
from . import text  # noqa: F401
from . import udfs  # noqa: F401
