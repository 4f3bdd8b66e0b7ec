"""Numerical core: residuals, Jacobians, Hessian blocks, Schur reduction,
linear algebra. All functions are pure, statically shaped, and jit-safe."""
