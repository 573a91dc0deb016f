"""Offline preprocessing tools (triangulation, normal estimation, LoRA prep)."""
