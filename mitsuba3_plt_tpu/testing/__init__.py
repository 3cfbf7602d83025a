from .chi2 import ChiSquareTest, BSDFAdapter, SphericalDomain

__all__ = ["ChiSquareTest", "BSDFAdapter", "SphericalDomain"]
