"""Canonical query plans: the three views + delta table function + report."""

from .views import (
    all_rankings_view,
    all_rankings_with_delta_view,
    all_rankings_with_urls_view,
    rank_delta_between_dates,
)

__all__ = [
    "all_rankings_view",
    "all_rankings_with_urls_view",
    "all_rankings_with_delta_view",
    "rank_delta_between_dates",
]
