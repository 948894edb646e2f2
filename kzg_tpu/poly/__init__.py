from .polynomial import Polynomial, op_tree
from .subproduct import (
    SubProductTree,
    vanishing_poly,
    poly_derivative,
    lagrange_interpolation,
)

__all__ = [
    "Polynomial",
    "op_tree",
    "SubProductTree",
    "vanishing_poly",
    "poly_derivative",
    "lagrange_interpolation",
]
