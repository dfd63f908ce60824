"""Graph applications built on the sparse primitives — L4 of the stack
(the reference's ``Applications/`` directory)."""
