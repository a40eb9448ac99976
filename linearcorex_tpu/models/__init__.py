"""Estimator surfaces: Corex, stacked CorEx, model selection (L5-L6)."""
