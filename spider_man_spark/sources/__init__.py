"""Sources: synthetic corpus, fetch stage (stub + HTTP), parse stage."""
