from .interaction import interaction_features
from .merge import merge_feature_tables
from .search import search_trends

__all__ = ["interaction_features", "search_trends", "merge_feature_tables"]
