"""Spark operators — declarative DataFrame stages of the KG pipeline plus
the training-data operators (dedup, similarity, text analysis, multimodal).
"""
