from .heterogclstm import HeteroGCLSTM

__all__ = ["HeteroGCLSTM"]
