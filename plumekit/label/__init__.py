"""Label curation — the reference's plume_selector workflow, non-blocking."""

from plumekit.label.ranking import (
    load_plume_masks,
    load_prediction,
    plume_support,
    review_order,
)
from plumekit.label.selector import (
    remove_duplicated_plumes,
    subset_plume,
    find_plume_aod,
    auto_reject,
    review_plumes,
    order_reviews,
    apply_decisions,
    export_review_batch,
    interactive_review,
    PlumeReview,
)

__all__ = [
    "remove_duplicated_plumes", "subset_plume", "find_plume_aod",
    "auto_reject", "review_plumes", "order_reviews", "apply_decisions",
    "export_review_batch", "interactive_review", "PlumeReview",
    "plume_support", "review_order",
    "load_prediction", "load_plume_masks",
]
