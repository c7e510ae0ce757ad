"""Demo applications (reference: ``examples/castle.rs``)."""
