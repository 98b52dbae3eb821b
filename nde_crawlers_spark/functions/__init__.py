"""Column-expression function kernels (pure Catalyst expressions, no UDFs)."""
