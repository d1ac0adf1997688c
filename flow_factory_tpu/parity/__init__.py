from .harness import ParityHarness, ParityReport, compare_records

__all__ = ["ParityHarness", "ParityReport", "compare_records"]
