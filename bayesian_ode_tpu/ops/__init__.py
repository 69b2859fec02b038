"""Pallas TPU kernels for the hot ops (SURVEY.md §7.2 step 7)."""
from .pallas_rbf import svgd_phi_pallas, svgd_phi_reference  # noqa: F401

__all__ = ["svgd_phi_pallas", "svgd_phi_reference"]
