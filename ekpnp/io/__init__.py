"""I/O: tecplot export, checkpoint/restore, CSV time series."""
