"""SMC layer (placeholder while core is under construction)."""
