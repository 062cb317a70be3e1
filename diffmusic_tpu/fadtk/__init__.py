from .engine import FADEngine, cache_embedding_files, cache_path
from .model_loader import ModelLoader, get_all_models, get_model
from .utils import merge_stats, stats_from_npy_dir

__all__ = ["FADEngine", "cache_embedding_files", "cache_path", "ModelLoader",
           "get_all_models", "get_model", "merge_stats", "stats_from_npy_dir"]
