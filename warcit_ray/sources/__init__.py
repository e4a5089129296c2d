"""Sources: seed expansion (directories / files / ZIP entries), the
Lance-shaped image+caption table reader, side-table readers (mapfile,
conversion rules/results, transclusion manifests), and the
deterministic synthetic corpus generator."""
