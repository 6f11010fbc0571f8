from ttc.infer.pipeline import TilePredictor

__all__ = ["TilePredictor"]
