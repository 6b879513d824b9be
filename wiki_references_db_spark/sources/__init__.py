"""Data sources: .mwrev.zst revision bundles, parquet staging IO."""
