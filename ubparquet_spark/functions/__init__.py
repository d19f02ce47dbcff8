"""Column-function libraries (text/dedup/similarity live in plans; this
package hosts the multimodal binary-column surface)."""
