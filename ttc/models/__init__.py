from ttc.models.unet import TreeCoverNet

__all__ = ["TreeCoverNet"]
