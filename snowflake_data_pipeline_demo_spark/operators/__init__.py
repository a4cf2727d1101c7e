from .merge import insert_only_merge, merge_result

__all__ = ["insert_only_merge", "merge_result"]
