"""Column-expression building blocks shared by operators."""
