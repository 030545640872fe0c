# Sleep-study symptom vocabulary (UMLS CUI | TUI | SNOMED code | SAB | string | preferred)
# Demonstrates the reference's custom-dictionary mechanism (nlp/watcher.py:107-170)
# for a NON-covid study: 6-column ctakesclient layout, converted to the
# 4-column cTAKES form at install time.
C0917801|T184|193462001|SNOMEDCT_US|insomnia|Insomnia
C0917801|T184|193462001|SNOMEDCT_US|sleeplessness|Insomnia
C0013404|T184|267036007|SNOMEDCT_US|dyspnea|Dyspnea
C0037384|T184|72863001|SNOMEDCT_US|snoring|Snoring
C0541919|T184|77692006|SNOMEDCT_US|hypersomnia|Hypersomnia
C0751229|T047|78275009|SNOMEDCT_US|sleep apnea|Obstructive sleep apnea
C0015672|T184|84229001|SNOMEDCT_US|fatigue|Fatigue
