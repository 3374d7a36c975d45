"""Set-level batch operators — the engine's §2 core."""

from .maintain import maintain
from .topk import top_k_per_group
from .upsert import merge_song, priority_dedup, upsert
from .validate import check_cardinality, validate_ranking

__all__ = [
    "upsert",
    "merge_song",
    "priority_dedup",
    "maintain",
    "top_k_per_group",
    "validate_ranking",
    "check_cardinality",
]
