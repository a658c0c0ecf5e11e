"""Sources & sinks: testdata loaders, partitioned writers, checkpoint ledger."""
