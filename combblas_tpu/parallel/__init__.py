"""Distributed layer: process-grid meshes, distributed objects, algorithms."""
