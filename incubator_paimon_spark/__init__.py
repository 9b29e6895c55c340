"""incubator_paimon_spark — a PySpark-native lakehouse table engine with the
capabilities of apache/incubator-paimon (reference studied read-only at
/root/reference; see SURVEY.md). Spark DataFrame/SQL is the executor; Parquet
+ JSON metadata is the storage; Paimon's semantics (merge engines, snapshot
protocol, changelog, time travel, compaction) are DataFrame programs and
driver-side planning code."""

from .table import Catalog, Table  # noqa: F401
from .jdbc_catalog import JdbcCatalog  # noqa: F401
from .predicate import P, Predicate  # noqa: F401
from .session import get_spark  # noqa: F401
from .metadata.schema import TableSchema  # noqa: F401
from .sql import execute_sql  # noqa: F401
from .jvm_catalog import install_sql_catalog  # noqa: F401

__version__ = "0.1.0"
