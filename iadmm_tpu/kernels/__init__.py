# Pallas kernels are registered here as they land.
