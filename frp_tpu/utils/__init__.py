"""Host-side utilities: document store, crypto, logging/audit, caches."""
