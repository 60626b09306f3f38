"""Model layer — the U-Net the reference promised but never shipped
(``src/models/`` is empty; ``README.md:41-45``)."""

from plumekit.models.unet import UNet, DoubleConv, receptive_field
from plumekit.models.unetpp import UNetPP, build_model
from plumekit.models.losses import bce_with_logits, dice_loss, dice_bce_loss, iou

__all__ = ["UNet", "UNetPP", "build_model", "DoubleConv",
           "receptive_field", "bce_with_logits", "dice_loss",
           "dice_bce_loss", "iou"]
