"""Field instances for the TPU compute path."""

from ..constants import P, R, FR_LIMBS, FP_LIMBS
from .limb import LimbField

# Fr: the BLS12-381 scalar field (polynomial coefficients live here).
FR = LimbField(R, FR_LIMBS, name="Fr")

# Fp: the BLS12-381 base field (curve point coordinates live here).
FP = LimbField(P, FP_LIMBS, name="Fp")
