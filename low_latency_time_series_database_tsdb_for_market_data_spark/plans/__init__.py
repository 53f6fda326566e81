"""Physical-plan inspection and contracts."""

from .contracts import (  # noqa: F401
    broadcast_hash_joins,
    exchanges,
    file_scans,
    physical_plan,
    pushed_filters,
    read_schemas,
    sort_merge_joins,
)
