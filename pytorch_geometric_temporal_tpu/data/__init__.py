from .chickenpox import ChickenpoxDatasetLoader

__all__ = ["ChickenpoxDatasetLoader"]
