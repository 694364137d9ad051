"""Ray Data batch stages — Arrow-in/Arrow-out ``map_batches`` callables."""
