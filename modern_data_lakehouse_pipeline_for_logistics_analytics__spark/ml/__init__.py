from .pipeline import evaluate, train_delivery_model

__all__ = ["train_delivery_model", "evaluate"]
