"""On-device BLS12-381 pairing: Fp2/6/12 tower + optimal ate Miller loop +
final exponentiation (SURVEY.md §7 step 9)."""

from .tower import (
    f12_mul,
    f12_sqr,
    f12_inv,
    f12_conj,
    f12_frobenius,
    f12_pow_static,
    f12_one,
    f12_is_one,
    f12_eq,
    f12_from_oracle,
    f12_to_oracle,
)
from .pairing import (
    miller_loop_device,
    final_exp_device,
    pairing_device,
    pairing_check_device,
)

__all__ = [
    "f12_mul", "f12_sqr", "f12_inv", "f12_conj", "f12_frobenius",
    "f12_pow_static", "f12_one", "f12_is_one", "f12_eq",
    "f12_from_oracle", "f12_to_oracle",
    "miller_loop_device", "final_exp_device", "pairing_device",
    "pairing_check_device",
]
