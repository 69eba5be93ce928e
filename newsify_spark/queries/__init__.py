"""Named query registry — the single source for __spark_entry__.py,
bench.py, and the pytest oracle harness.

Importing this package registers every query module.
"""

from newsify_spark.queries.registry import REGISTRY, Query, register  # noqa: F401
from newsify_spark.queries import relational  # noqa: F401,E402
from newsify_spark.queries import vector  # noqa: F401,E402
from newsify_spark.queries import llmops  # noqa: F401,E402
from newsify_spark.queries import recommend  # noqa: F401,E402
from newsify_spark.queries import mlops  # noqa: F401,E402
from newsify_spark.queries import extra  # noqa: F401,E402
from newsify_spark.queries import tpch  # noqa: F401,E402
from newsify_spark.queries import corpus  # noqa: F401,E402
from newsify_spark.queries import sessions  # noqa: F401,E402
