from .engine import FADEngine, cache_embedding_files, cache_path

__all__ = ["FADEngine", "cache_embedding_files", "cache_path"]
