"""North-star training-data-pipeline functions (SURVEY.md §2d, BASELINE.json):
deduplication, similarity search, text analysis, multimodal columns. These
extend the reference's surface — the reference is an ETL columnarizer whose
output feeds exactly these workloads (reference README.md:14-18)."""
