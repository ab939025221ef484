"""Sources: synthetic pages generator, table catalog shim, readers."""
