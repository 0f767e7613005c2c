"""Offline tools: checkpoint converters (torch allowed here only,
SURVEY.md section 5.4) and the ReasonAQA evaluation runner."""
