"""Label curation — the reference's plume_selector workflow, non-blocking."""

from plumekit.label.selector import (
    remove_duplicated_plumes,
    subset_plume,
    find_plume_aod,
    auto_reject,
    review_plumes,
    apply_decisions,
    export_review_batch,
    interactive_review,
    PlumeReview,
)

__all__ = [
    "remove_duplicated_plumes", "subset_plume", "find_plume_aod",
    "auto_reject", "review_plumes", "apply_decisions",
    "export_review_batch", "interactive_review", "PlumeReview",
]
