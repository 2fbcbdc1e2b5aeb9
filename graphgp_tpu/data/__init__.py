"""Datasets: synthetic generators and real-graph loaders with caching."""

from .synthetic import (
    GENERATORS,
    generate,
    generate_circle_graph_data,
    generate_grid_data,
    generate_grid_multimodal_data,
    generate_periodic_grid_data,
    generate_ring_data,
    generate_staircase_grid_data,
)
