"""Extension operators beyond the reference's relational surface:
dedup (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
cosine), similarity search, text analysis, multimodal column plumbing.
All hot paths stay in JVM built-ins (no row-at-a-time Python UDFs);
pandas interchange only where Arrow-batched and genuinely needed."""
