"""Named-query registry. Importing this package registers every query
module; the driver contract (`__spark_entry__.py`) reads QUERIES and
ORACLES from here."""

from .registry import ORACLES, QUERIES, query

# Import for side effect: each module registers its queries.
#
# ORDER IS LOAD-BEARING: the driver's CORRECTNESS gate verifies the
# FIRST 50 registry entries, so the north-star LLM-pipeline surface
# (dedup, similarity, ML, pipeline composites, text analysis)
# registers first; the long-green relational batches rotate to the
# back of the window — they stay fully guarded by
# tests/test_oracle_parity.py, which sweeps EVERY oracle regardless
# of position.
from . import dedup_queries  # noqa: E402,F401
from . import similarity_queries  # noqa: E402,F401
from . import ml_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import text_queries  # noqa: E402,F401
from . import udf_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import relational2  # noqa: E402,F401
from . import relational3  # noqa: E402,F401
from . import relational4  # noqa: E402,F401
from . import extra_queries  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
