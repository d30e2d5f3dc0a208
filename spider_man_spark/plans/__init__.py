"""Driver-side plans: state store, epoch job, crawl-job control plane."""
