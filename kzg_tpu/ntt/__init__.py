from .domain import Domain, compute_omega
from .evaluation_domain import EvaluationDomain

__all__ = ["Domain", "EvaluationDomain", "compute_omega"]
