"""JAX/flax model zoo for the sic_tpu codec."""
