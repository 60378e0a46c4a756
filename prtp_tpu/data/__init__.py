"""Host-side data pipeline (no JAX): netlist/report parsing, graph
construction, feature extraction, rasterization, serialization."""
