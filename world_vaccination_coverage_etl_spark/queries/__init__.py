"""Query registry: every SURVEY.md §2 operator as a (Spark plan, DuckDB
oracle SQL) pair over the driver's star schema, plus the large-scale
extension operators (dedup / similarity / text / JSON / event-time).

Contract (driver, __spark_entry__.py): each entry's Spark callable takes
``(spark, sf_dir)`` and returns a DataFrame; the oracle SQL must produce
identical column names, types, and values in DuckDB.  Determinism rules
applied throughout:

- every float-valued output is ``round()``-ed identically on both sides;
- money aggregates go through DECIMAL(18,2) casts so distributed vs
  single-node summation order cannot produce differing bits;
- every ordered/limited query carries a full tie-breaker key;
- timestamps are cast to DATE (or formatted) at the output edge so
  engine timestamp internals never reach the comparator.

Package layout (split from one 8.9 kLoC file, r5 verdict item 8):
_core holds QueryDef/register/REGISTRY + shared helpers; topic
modules register queries on import (import order below IS the
registry definition order the certification rotation builds on);
_rotation reorders for the driver's 50-entry correctness window.
"""

from ._core import REGISTRY, QueryDef, register  # noqa: F401

# registration order — append new topic modules at the end
from . import m01_scans  # noqa: F401,E402
from . import m02_aggregates  # noqa: F401,E402
from . import m03_joins  # noqa: F401,E402
from . import m04_windows_scalar  # noqa: F401,E402
from . import m05_events_streaming  # noqa: F401,E402
from . import m06_text_sampling  # noqa: F401,E402
from . import m07_dedup  # noqa: F401,E402
from . import m08_similarity  # noqa: F401,E402
from . import m09_multimodal_r5c  # noqa: F401,E402
from . import m10_tpch_breadth  # noqa: F401,E402
from . import m11_substring_r6  # noqa: F401,E402
from ._rotation import _rotated

REGISTRY = _rotated(REGISTRY)
