from .losses import LOSS_MULTIPLIER_SEMANTIC, point_wise_loss, total_loss  # noqa: F401
