"""End-to-end query plans over the driver's synthetic tables."""
