"""Operator modules — importing this package registers every declared query."""

from . import aggregates  # noqa: F401
from . import analytics_ext  # noqa: F401
from . import engagement_ext  # noqa: F401
from . import events_ext  # noqa: F401
from . import extended  # noqa: F401
from . import joins  # noqa: F401
from . import llm  # noqa: F401
from . import indicators_ext  # noqa: F401
from . import micro_ext  # noqa: F401
from . import portfolio_ext  # noqa: F401
from . import quality_ext  # noqa: F401
from . import reference_surface  # noqa: F401
from . import relational_ext  # noqa: F401
from . import round8_ext  # noqa: F401
from . import round9_ext  # noqa: F401
from . import round10_ext  # noqa: F401
from . import sessions  # noqa: F401
from . import setops  # noqa: F401
from . import tpch_ext  # noqa: F401
from . import tsdb_ext  # noqa: F401
from . import warehouse_ext2  # noqa: F401
from . import windows  # noqa: F401
from . import round11_ext  # noqa: F401
from . import round12_ext  # noqa: F401
from . import round13_ext  # noqa: F401
