#!/usr/bin/perl
# HeadParser + LinkExtor differential helper.  For each JSON
# {"doc":...} line emit [headers, links]: headers = ordered
# [name, value] pairs push_header'd by the reference HeadParser;
# links = [tag, attr, url] triples from the reference LinkExtor
# (no base).  Needs the built reference + the HTML::Tagset data stub
# (written by scripts/toke_diff.py) on /tmp/perl5lib.
use strict; use warnings;
my $blib = $ENV{REF_BLIB} || "/tmp/refbuild/blib";
use lib; lib->import("$blib/lib", "$blib/arch", "/tmp/perl5lib");
require HTML::HeadParser;
require HTML::LinkExtor;
use JSON::PP;

package HeaderCollector;
sub new { bless { pairs => [] }, shift }
sub push_header {
    my ($self, $k, $v) = @_;
    push @{$self->{pairs}}, [$k, $v];
}
sub header { return }
sub as_string { return "" }

package main;
my $json = JSON::PP->new->utf8(1)->allow_nonref(1);
while (my $line = <STDIN>) {
    chomp $line; next unless length $line;
    my $doc = $json->decode($line)->{doc};

    my $hc = HeaderCollector->new;
    my $hp = HTML::HeadParser->new($hc);
    $hp->parse($doc); $hp->eof;

    my @links;
    my $lp = HTML::LinkExtor->new(sub {
        my ($tag, @pairs) = @_;
        while (@pairs) {
            my ($a, $v) = (shift @pairs, shift @pairs);
            push @links, [$tag, $a, "$v"];
        }
    });
    $lp->parse($doc); $lp->eof;

    print $json->encode([$hc->{pairs}, \@links]), "\n";
}
