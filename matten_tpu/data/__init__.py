"""Host-side data layer: structures, periodic graphs, batching, transforms."""
