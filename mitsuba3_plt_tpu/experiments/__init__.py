"""End-to-end experiment applications (the fork's scripts/ layer)."""
