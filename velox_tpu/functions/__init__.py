"""Function packages (reference: velox/functions/)."""
