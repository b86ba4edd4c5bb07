"""Sources: pruned parquet readers and the deterministic source-code table."""

from .codetable import (CODETABLE_SCHEMA, add_content_sha256, codetable_cte,
                        read_codetable, read_repos)
from .reader import (read_csv_clean, read_json_clean,
                     read_parquet_clean, strip_pandas_meta)

__all__ = ["read_codetable", "read_repos", "codetable_cte", "CODETABLE_SCHEMA",
           "add_content_sha256", "read_parquet_clean", "strip_pandas_meta",
           "read_csv_clean", "read_json_clean"]
