"""Plan-construction helpers: join-strategy selection and skew salting."""
