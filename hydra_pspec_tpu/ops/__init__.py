"""Low-level numerical ops: Fourier operators, inverse-gamma sampling,
masked linear algebra, tapers. Pure jittable functions, CPU-testable."""

from . import fourier, invgamma, linalg
