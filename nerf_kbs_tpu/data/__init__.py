"""Data layer: dataparsers (KITTI odometry, transforms.json, SUDS
metadata.json), image metadata, datamanagers (in-memory and chunked-streaming),
and synthetic fixtures."""
