from osprey_spark.sources.transcripts import generate_transcripts, transcripts_pdf

__all__ = ["generate_transcripts", "transcripts_pdf"]
