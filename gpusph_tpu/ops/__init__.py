"""SPH numerics: kernels, EOS, neighbors, forces, integration, filters."""
