"""Per-actor index state: STR-packed bbox tree, cell indexes."""
