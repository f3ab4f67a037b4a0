from .xpoint_loss import XPointLoss, detector_loss, descriptor_loss

__all__ = ["XPointLoss", "detector_loss", "descriptor_loss"]
