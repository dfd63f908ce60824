"""Local (single-device) sparse kernels — L1 of the stack."""
