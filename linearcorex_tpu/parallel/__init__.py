"""Sharding and batched-restart execution over device meshes."""
