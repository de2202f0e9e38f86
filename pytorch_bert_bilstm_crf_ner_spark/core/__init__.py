"""Pure, Spark-free core: tag vocabularies, Viterbi, span FSMs, sentence
cutting, relation pairing, span metrics.  Everything here is deterministic
and importable on executors (inside pandas UDFs) and on the driver (the
single-process parity oracle) alike."""
