from .sparse import EllMatrix, ell_from_csr

__all__ = ["EllMatrix", "ell_from_csr"]
