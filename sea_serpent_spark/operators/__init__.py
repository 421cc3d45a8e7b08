from .link import add_linked_column, compute_links, link, linked_rollup

__all__ = ["link", "compute_links", "linked_rollup", "add_linked_column"]
