"""Training-data pipeline query plans (dedup / similarity / text analysis).

Implementations in ``..datapipe``; registered here. Placeholder — filled in
as the datapipe operators land.
"""
