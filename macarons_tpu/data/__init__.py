"""Data layer: GT generators, dataset walkers, mesh IO."""
