#!/usr/bin/perl
# Differential-test helper: dump the reference parser's event stream
# as JSON lines.  Input: one JSON object per line {"doc": ..., "opts":
# {option => value, ...}}.  Output: one JSON array of event objects
# per line.  Requires a built HTML-Parser; pass its blib path via
# REF_BLIB (default /tmp/refbuild/blib).
use strict;
use warnings;
my $blib = $ENV{REF_BLIB} || "/tmp/refbuild/blib";
use lib;
lib->import("$blib/lib", "$blib/arch");
require HTML::Parser;
use JSON::PP;

my $json = JSON::PP->new->utf8(1)->canonical(1)->allow_nonref(1);

while (my $line = <STDIN>) {
    chomp $line;
    next unless length $line;
    my $req  = $json->decode($line);
    my $doc  = $req->{doc};
    my $opts = $req->{opts} // {};
    my @events;
    my $p = HTML::Parser->new(api_version => 3);
    $p->handler(
        default => sub {
            my ($event, $text, $dtext, $tagname, $attr, $attrseq,
                $is_cdata, $offset, $length, $ln, $col, $tag,
                $token0, $tokenpos, $offset_end, $tokens) = @_;
            return if $event eq 'start_document'
                   || $event eq 'end_document';
            push @events, {
                event      => $event,
                text       => $text,
                dtext      => $dtext,
                tagname    => $tagname,
                attr       => $attr,
                attrseq    => $attrseq,
                is_cdata   => ($is_cdata ? 1 : 0),
                offset     => $offset,
                length     => $length,
                line       => $ln,
                column     => $col,
                tag        => $tag,
                token0     => $token0,
                tokenpos   => $tokenpos,
                offset_end => $offset_end,
                tokens     => $tokens,
            };
        },
        "event, text, dtext, tagname, attr, attrseq, is_cdata, "
      . "offset, length, line, column, tag, token0, tokenpos, "
      . "offset_end, tokens"
    );
    for my $o (sort keys %$opts) {
        my $v = $opts->{$o};
        if (ref $v eq 'ARRAY') { $p->$o(@$v); }
        else                   { $p->$o($v); }
    }
    $p->parse($doc);
    $p->eof;
    print $json->encode(\@events), "\n";
}
