"""Source connectors: paginated / batched REST → DataFrame."""
