"""Data & I/O layer: MRC, STAR, CryoSPARC .cs, metadata dataframes, EMDB."""
