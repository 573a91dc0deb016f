"""Loss and prior modules (reference: /root/reference/loss/__init__.py:1-3,
utils/loss_utils.py)."""

from .photometric import l1_loss, l2_loss, psnr, ssim  # noqa: F401
from .normal_guidance import loss_normal_guidance  # noqa: F401
