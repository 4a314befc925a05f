"""Dataparsers: dataset-on-disk -> DataparserOutputs."""
