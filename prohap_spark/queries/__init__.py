"""Query registry: every implemented SURVEY.md §2 operator declared as
a (spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle SQL string over the same tables.

Column-name contract: Spark aliases and oracle SQL aliases MUST match
(the driver sorts columns by name before value-hashing).
"""

from prohap_spark.queries.registry import REGISTRY, register, table

# import for registration side effects
from prohap_spark.queries import relational  # noqa: F401
from prohap_spark.queries import windowed  # noqa: F401
from prohap_spark.queries import textdata  # noqa: F401
from prohap_spark.queries import simsearch  # noqa: F401
from prohap_spark.queries import scalars  # noqa: F401
from prohap_spark.queries import classic  # noqa: F401


def queries():
    return {name: fn for name, (fn, _oracle) in REGISTRY.items()}


def oracle_sql():
    return {name: oracle for name, (_fn, oracle) in REGISTRY.items() if oracle is not None}
