"""Pure scalar/vector function libraries (no Ray dependency)."""
