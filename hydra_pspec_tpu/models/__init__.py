"""Inference models: the Gibbs sampler (gibbs/gcr) and the alternative
estimators (lssa, oqe, dpss)."""

from . import gcr, gibbs, lssa, oqe, dpss
