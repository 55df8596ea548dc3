"""Streaming modules (sink + streaming operators)."""

from . import ops  # noqa: F401
from . import rollup  # noqa: F401
from . import sink  # noqa: F401
from . import sink_query  # noqa: F401
from . import stateful  # noqa: F401
