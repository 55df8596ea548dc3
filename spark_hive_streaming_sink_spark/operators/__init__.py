"""Batch operator modules; importing this package registers their queries."""

from . import advanced  # noqa: F401
from . import aggregates  # noqa: F401
from . import joins  # noqa: F401
from . import layout  # noqa: F401
from . import relational  # noqa: F401
from . import semistructured  # noqa: F401
from . import setops  # noqa: F401
from . import timeseries  # noqa: F401
from . import tpch  # noqa: F401
from . import tpch_extended  # noqa: F401
from . import windows  # noqa: F401
