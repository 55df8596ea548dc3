"""Source/format modules: the registered ``hive-streaming`` Python Data
Source and the socket/rate streaming-source parity queries."""

from . import file_formats  # noqa: F401
from . import hive_streaming_datasource  # noqa: F401
from . import stream_sources  # noqa: F401
