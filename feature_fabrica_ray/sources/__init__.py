"""Sources: pruned parquet readers and the deterministic source-code table."""

from .codetable import (CODETABLE_SCHEMA, add_content_sha256, codetable_cte,
                        read_codetable, read_repos)

__all__ = ["read_codetable", "read_repos", "codetable_cte", "CODETABLE_SCHEMA",
           "add_content_sha256"]
